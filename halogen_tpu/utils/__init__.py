from halogen_tpu.utils.metrics import RaysMeter, RenderStats, get_logger
