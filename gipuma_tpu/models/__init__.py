from . import patchmatch, scene
from .patchmatch import PMState, run_patchmatch, init_state, iteration, finalize
from .scene import build_scene
