"""Pipeline assemblies + the named query catalog (driver contract)."""
