"""``tf2_gnn_tpu_test`` console entry (reference: tf2_gnn/cli/test.py:39-84).

Usage: ``tf2_gnn_tpu_test trained_model.pkl data/ppi/``
"""
import argparse

from ..harness.run import run_and_debug, test_model


def run():
    parser = argparse.ArgumentParser(
        description="Evaluate a trained TPU-native GNN model.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("trained_model", type=str, help="Checkpoint .pkl file.")
    parser.add_argument("data_path", type=str, help="Directory with the task data.")
    parser.add_argument("--debug", action="store_true", default=False)
    args = parser.parse_args()
    run_and_debug(lambda: test_model(args.trained_model, args.data_path), args.debug)


if __name__ == "__main__":
    run()
