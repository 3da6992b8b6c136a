from .flat_join import flat_export  # noqa: F401
