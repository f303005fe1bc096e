from mofa_tpu.ops.resize import (
    resize_hw,
    resize_nhwc,
    interp_matrix,
    gaussian_blur_hw,
    resize_antialias_hw,
)
from mofa_tpu.ops.euler import EulerSchedule, make_euler_schedule, euler_step, scale_model_input, add_noise
from mofa_tpu.ops.trajectory import pchip_interpolate, interpolate_trajectory
from mofa_tpu.ops.rasterize import rasterize_trajectories, landmarks_to_sparse_flow
from mofa_tpu.ops.flow import flow_pyramid, rescale_flow, merge_flows
from mofa_tpu.ops.edm import rand_cosine_interpolated, edm_scalings
