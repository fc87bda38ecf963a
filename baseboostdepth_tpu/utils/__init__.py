"""Small shared utilities (reference utils.py equivalents)."""

from baseboostdepth_tpu.utils.misc import (  # noqa: F401
    colormap,
    normalize_image,
    readlines,
    resolve_splits_dir,
    sec_to_hm_str,
)
