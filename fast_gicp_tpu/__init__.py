"""fast_gicp_tpu — TPU-native point-cloud registration (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of koide3/fast_gicp for TPU:
GICP, voxelized GICP, and P2D/D2D NDT as fully jitted Gauss-Newton /
Levenberg-Marquardt fixed-point solves over SE(3), with MXU-shaped neighbor
search and covariance estimation, a sort/segment voxel hash map, and
shard_map multi-device scaling.  See SURVEY.md for the reference analysis.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: align graphs take 60-120 s to compile on TPU
# runtimes; caching makes every process after the first start instantly.
# Opt out with FAST_GICP_TPU_NO_CACHE=1.
if not _os.environ.get("FAST_GICP_TPU_NO_CACHE"):
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.cache/fast_gicp_tpu_jit")
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from . import se3
from .solver import LsqConfig, LsqResult, lsq_solve
from .models.base import Registration
from .models.gicp import (
    FastGICP,
    FastGICPSingleThread,
    GICPConfig,
    gicp_align,
    gicp_evaluate,
)
from .models.vgicp import (
    FastVGICP,
    FastVGICPCuda,
    VGICPConfig,
    vgicp_align,
    vgicp_align_multires,
    vgicp_evaluate,
    vgicp_register,
)
from .models.ndt import NDT, NDTConfig, NDTCuda, ndt_align, ndt_evaluate
from .models.pose_graph import (
    PoseGraphConfig,
    PoseGraphResult,
    optimize_pose_graph,
)
from .models.pose_graph_sparse import (
    SlidingWindowBA,
    SparsePGConfig,
    optimize_pose_graph_sparse,
    optimize_pose_graph_sparse_sharded,
)
from .models.loop_closure import (
    LoopClosure,
    LoopClosureConfig,
    detect_loop_closures,
    find_loop_candidates,
)
from .models.metrics import fitness_score, pose_error
from .models.scan_to_map import (
    ScanToMapConfig,
    ScanToMapOdometry,
    load_map,
    merge_maps,
    save_map,
)

__version__ = "0.1.0"

__all__ = [
    "se3",
    "LsqConfig",
    "LsqResult",
    "lsq_solve",
    "Registration",
    "FastGICP",
    "FastGICPSingleThread",
    "GICPConfig",
    "gicp_align",
    "gicp_evaluate",
    "FastVGICP",
    "FastVGICPCuda",
    "VGICPConfig",
    "vgicp_align",
    "vgicp_align_multires",
    "vgicp_evaluate",
    "vgicp_register",
    "NDT",
    "NDTConfig",
    "NDTCuda",
    "ndt_align",
    "ndt_evaluate",
    "LoopClosure",
    "LoopClosureConfig",
    "detect_loop_closures",
    "find_loop_candidates",
    "PoseGraphConfig",
    "PoseGraphResult",
    "optimize_pose_graph",
    "SlidingWindowBA",
    "SparsePGConfig",
    "optimize_pose_graph_sparse",
    "optimize_pose_graph_sparse_sharded",
    "fitness_score",
    "pose_error",
    "ScanToMapConfig",
    "ScanToMapOdometry",
    "save_map",
    "load_map",
    "merge_maps",
]
