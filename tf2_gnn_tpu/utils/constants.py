"""Numerical constants shared across the framework.

Mirrors the role of the reference's ``tf2_gnn/utils/constants.py`` (SMALL_NUMBER).
"""

# Small epsilon used to avoid division by zero (reference: utils/constants.py:1).
SMALL_NUMBER = 1e-7
