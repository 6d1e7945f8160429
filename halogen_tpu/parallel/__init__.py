from halogen_tpu.parallel.sharding import (
    make_render_mesh,
    render_frame_sharded,
    train_step_sharded,
    init_distributed,
)

__all__ = [
    "make_render_mesh",
    "render_frame_sharded",
    "train_step_sharded",
    "init_distributed",
]
