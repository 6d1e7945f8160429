from halogen_tpu.core import math  # noqa: F401
from halogen_tpu.core.types import SceneData, MaterialTable  # noqa: F401
from halogen_tpu.core.medium import MediumStack  # noqa: F401
