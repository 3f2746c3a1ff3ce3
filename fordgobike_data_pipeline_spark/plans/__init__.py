from . import bronze, corpus, ddl, gold, runner, silver  # noqa: F401
