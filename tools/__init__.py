"""Bench/fixture tooling; a package so bench.py can import
tools.bench_incremental.run without spawning a second JVM."""
