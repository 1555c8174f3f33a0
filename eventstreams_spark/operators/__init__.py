"""Reusable plan-builder operators (DataFrame -> DataFrame).

Each module composes built-in DataFrame ops; none collect to the
driver. Queries in ``eventstreams_spark.queries`` are thin wrappers
over these with oracle SQL attached.
"""
