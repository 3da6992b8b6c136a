from .lake import load_table, register_views, TESTDATA_TABLES  # noqa: F401
