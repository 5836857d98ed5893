from . import serialization, timing  # noqa: F401
