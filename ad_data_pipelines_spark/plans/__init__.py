"""Declarative pipeline plans (one module per output table) and the
operator-coverage query registry over the driver testdata."""
