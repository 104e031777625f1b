from .beatdp import dp_forward  # noqa: F401
