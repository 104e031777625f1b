from .mesh import default_mesh, batch_sharding, replicated, corpus_stats  # noqa: F401
