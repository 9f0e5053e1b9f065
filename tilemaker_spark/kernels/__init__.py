"""Deterministic numpy geometry kernels (no Spark imports).

These implement the reference's math bit-for-bit where determinism
matters (SURVEY.md §7 "hard parts"): Mercator projection, tile
conversion with C-style truncation, tile cover (DDA segment walk +
scanline fill), rectangular clipping, Douglas-Peucker simplification,
ring assembly, and MVT protobuf encoding.
"""
