from .common import load_torch_state_dict  # noqa: F401
from .torch_i3d import convert_i3d  # noqa: F401
from .torch_vqvae import convert_vqvae  # noqa: F401
from .torch_d3pm import convert_d3pm  # noqa: F401
from .torch_clip import convert_clip_text  # noqa: F401
