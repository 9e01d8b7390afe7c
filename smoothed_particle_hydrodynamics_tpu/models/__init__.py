"""Scene catalogue ("model families"): ready-made configs + initial states."""

from .scenes import SCENES, make_scene

__all__ = ["SCENES", "make_scene"]
