"""SR-GNN standalone temporal runner CLI.

Twin of nar_module/nar/benchmarks/sr-gnn/run_sr_gnn.py:1-189 — identical
protocol to run_gru4rec (the reference's runners are isomorphic), with the
session-graph model and per-click prefix evaluation.

  python -m chameleon_recsys_tpu.cli.run_sr_gnn \
    --train_set_path_regex "sessions/sessions_hour_*.tfrecord.gz" \
    --num_items 46033 --output_csv sr_gnn_metrics.csv
"""
from __future__ import annotations

from ..baselines.sr_gnn import SRGNNJax, SRGNNSessionAdapter
from .run_gru4rec import build_parser, run_from_args


def main(argv=None):
    from ..utils.jax_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    p = build_parser()
    p.add_argument("--hidden_size", type=int, default=100)
    p.add_argument("--gnn_steps", type=int, default=1)
    p.add_argument("--l2", type=float, default=1e-5)
    p.add_argument("--lr", type=float, default=1e-3)
    args = p.parse_args(argv)

    def factory(a):
        return SRGNNSessionAdapter(
            SRGNNJax(
                a.num_items,
                hidden_size=args.hidden_size,
                steps=args.gnn_steps,
                lr=args.lr,
                l2=args.l2,
            ),
            n_sample=a.n_sample,
        )

    run_from_args(args, model_factory=factory)


if __name__ == "__main__":
    main()
