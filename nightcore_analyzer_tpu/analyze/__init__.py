from .result import AnalysisResult  # noqa: F401
from .consensus import build_result, compute_ibi_ratio  # noqa: F401
from .pipeline import run  # noqa: F401
