from .base import TrainerComponent  # noqa: F401
from .container import ComponentContainer  # noqa: F401
