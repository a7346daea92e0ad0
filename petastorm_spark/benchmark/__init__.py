"""Reader-throughput measurement (reference parity:
petastorm/benchmark/{cli,throughput}.py — re-expressed over this
engine's Reader)."""
