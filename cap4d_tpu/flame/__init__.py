from cap4d_tpu.flame.camera import (
    OPENCV2PYTORCH3D,
    project_vertices,
    rodrigues,
    transform_vertices,
)
from cap4d_tpu.flame.io import load_flame_pkl, make_synthetic_flame
from cap4d_tpu.flame.skinner import (
    FlameModel,
    build_flame_model,
    flame_forward,
    generate_uv_half_sphere,
    mouth_sphere,
)
from cap4d_tpu.flame.compute import compute_flame, load_cap4d_flame_model
