"""Evaluation suite: KITTI eigen/benchmark depth metrics, SYNS edge +
point-cloud metrics (TPU-native chamfer replacing the reference's external
CUDA extension), KITTI odometry ATE."""
