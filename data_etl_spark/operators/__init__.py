from . import chunking, merge  # noqa: F401
