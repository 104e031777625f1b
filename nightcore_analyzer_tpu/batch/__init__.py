from .corpus import CorpusAnalyzer, PairBuffers, pack_pair  # noqa: F401
