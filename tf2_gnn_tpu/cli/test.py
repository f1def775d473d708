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
    parser.add_argument("--model-params-override", type=str, default=None,
                        help="JSON string or file overriding model hypers.")
    parser.add_argument("--data-params-override", type=str, default=None,
                        help="JSON string or file overriding dataset hypers.")
    parser.add_argument("--azure-info", type=str, default=None,
                        help="Accepted for reference compatibility; azure:// "
                             "data paths are not supported (data/io.py).")
    parser.add_argument("--quiet", action="store_true", default=False,
                        help="Accepted for reference compatibility.")
    parser.add_argument("--debug", action="store_true", default=False)
    args = parser.parse_args()
    run_and_debug(
        lambda: test_model(
            args.trained_model, args.data_path,
            model_params_override=args.model_params_override,
            data_params_override=args.data_params_override,
        ),
        args.debug,
    )


if __name__ == "__main__":
    run()
