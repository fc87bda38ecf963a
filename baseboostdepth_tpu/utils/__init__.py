"""Small shared utilities (reference utils.py equivalents)."""

from baseboostdepth_tpu.utils.misc import readlines, sec_to_hm_str, normalize_image, colormap  # noqa: F401
