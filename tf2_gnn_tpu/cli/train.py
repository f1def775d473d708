"""``tf2_gnn_tpu_train`` console entry (reference: tf2_gnn/cli/train.py:13-38).

Usage: ``tf2_gnn_tpu_train RGCN PPI data/ppi/ [options] [--hyper value ...]``
Leftover ``--key value`` pairs are treated as hyperdrive-style overrides and
coerced to the type of the matching hyperparameter.
"""
from ..harness.run import (
    get_train_cli_arg_parser,
    parse_hyperdrive_leftovers,
    run_and_debug,
    run_train_from_args,
)


def run():
    parser = get_train_cli_arg_parser()
    args, leftovers = parser.parse_known_args()
    overrides = parse_hyperdrive_leftovers(leftovers)
    run_and_debug(lambda: run_train_from_args(args, overrides), args.debug)


if __name__ == "__main__":
    run()
