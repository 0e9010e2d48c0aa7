"""Vectorized scan/join/window stages for Ray Data pipelines.

Every function in ``scans``/``sessionize``/``asof`` operates on
(entity, ts)-sorted arrays and is designed to run INSIDE ``map_batches`` /
``map_groups`` on entity-complete blocks — the engine's partition invariant
(SURVEY.md §1.1: the reference's load-bearing (id, ht) sortedness).
"""
