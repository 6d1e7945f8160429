from halogen_tpu.render.accumulate import RenderState, Renderer

__all__ = ["RenderState", "Renderer"]
