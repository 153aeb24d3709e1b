"""Training-data-pipeline operators beyond the reference's inventory.

These are first-class components for running this engine over web-scale
training corpora (see the build brief): deduplication, similarity
search, text statistics, and multimodal column plumbing.  All are pure
DataFrame compositions or Arrow-batched pandas UDFs — no per-row
Python, no driver-side loops.
"""
