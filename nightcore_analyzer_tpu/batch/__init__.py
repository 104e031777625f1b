from .corpus import CorpusAnalyzer, PairBuffers, pack_pair  # noqa: F401

def main(argv=None):
    """`python -m nightcore_analyzer_tpu.batch` — corpus manifest driver."""
    from .driver import main as _main
    return _main(argv)
