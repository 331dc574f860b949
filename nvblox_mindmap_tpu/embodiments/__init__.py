from nvblox_mindmap_tpu.embodiments.base import EmbodimentBase, EmbodimentType
from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment
from nvblox_mindmap_tpu.embodiments.humanoid import HumanoidEmbodiment
from nvblox_mindmap_tpu.embodiments.registry import (
    get_embodiment_type_from_task,
    make_embodiment_for_task,
)

__all__ = [
    "ArmEmbodiment",
    "EmbodimentBase",
    "EmbodimentType",
    "HumanoidEmbodiment",
    "get_embodiment_type_from_task",
    "make_embodiment_for_task",
]
