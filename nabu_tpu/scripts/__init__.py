"""Pipeline scripts (reference layer L9: nabu/scripts/ + run dispatcher)."""
