"""Composed Dataset -> Dataset / Dataset -> artifact pipelines."""
