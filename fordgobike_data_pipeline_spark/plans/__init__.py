from . import bronze, gold, runner, silver  # noqa: F401
