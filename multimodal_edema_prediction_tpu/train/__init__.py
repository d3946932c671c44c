from . import checkpoint, engine, optim, state  # noqa: F401
