from . import anonymizers, data_lists, hashing, pyimpl  # noqa: F401
