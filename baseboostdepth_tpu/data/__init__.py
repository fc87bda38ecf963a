"""Data layer: KITTI/SYNS indexing, curriculum frame sampling, host-side
decode + resize, device-side augmentation, fixed-shape batch assembly,
prefetching loader."""
