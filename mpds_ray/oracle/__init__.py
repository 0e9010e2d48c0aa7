"""Single-process reference oracle (SURVEY.md §5).

Deliberately naive row-by-row loop implementations of the reference's
sequential-scan semantics, used ONLY as the conformance oracle in tests.
The engine's vectorized implementations (mpds_ray.stages) must match these.
"""
