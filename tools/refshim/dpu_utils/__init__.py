"""Minimal local stand-in for the `dpu-utils` pip package (not installed in
this image), providing exactly the surface `/root/reference/tf2_gnn` imports
(SURVEY.md §2 "External dpu-utils surface").

This package exists ONLY so the reference implementation can be executed
in-place for parity measurements (tools/refrun/*) and to produce real
reference checkpoints for import tests. It is test infrastructure, not part
of tf2_gnn_tpu. Semantics follow the public dpu-utils (>=0.2.7) API docs and
mirror the pinned semantics already encoded (and unit-tested) in
tf2_gnn_tpu/layers/mlp.py and tf2_gnn_tpu/ops/segment.py.
"""
