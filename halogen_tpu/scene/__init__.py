from halogen_tpu.scene.material import Material
from halogen_tpu.scene.scene import Scene
from halogen_tpu.scene import cornell

__all__ = ["Material", "Scene", "cornell"]
