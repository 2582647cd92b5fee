"""Train-state pytrees shared by the GAN trainers.

The reference keeps five mutable torch objects (g, target_g, d, opt_g, opt_d
— components/model_checkpoint.py:36-42). Here all of it is one immutable
pytree threaded through a single jitted step: parameters, BatchNorm stats,
EMA target params, and both optax optimizer states.
"""
from __future__ import annotations

from typing import Any

import flax.struct


@flax.struct.dataclass
class GANTrainState:
    g_params: Any
    g_stats: Any
    target_g_params: Any
    d_params: Any
    d_stats: Any
    opt_g: Any
    opt_d: Any


@flax.struct.dataclass
class TextGANTrainState(GANTrainState):
    """Adds the jointly-trained SkipGram embedding (trainers/text_cnn.py)."""
    emb_params: Any = None
    opt_emb: Any = None
