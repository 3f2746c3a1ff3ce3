from . import bronze, ddl, gold, runner, silver  # noqa: F401
