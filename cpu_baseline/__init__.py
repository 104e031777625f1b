from .reference import analyze_pair_cpu  # noqa: F401
