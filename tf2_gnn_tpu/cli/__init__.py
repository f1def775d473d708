"""Console entry points: ``tf2_gnn_tpu_train`` and ``tf2_gnn_tpu_test``."""
