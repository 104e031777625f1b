from .analyzer import PairAnalysis, analyze_pair, build_analyze_fn  # noqa: F401
