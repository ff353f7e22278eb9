"""CLI entry point: ``python -m logpipe_ray --config spec.json``.

The ``logpipe -f conf`` analog (src/main.c:39-86). Owns the Ray session
(guarded init — under ``ray job submit`` the session already exists and
the guard makes this a no-op attach). The driver-facing library code
never calls ray.init (see __ray_entry__ contract).

Usage:
    python -m logpipe_ray --config examples/flagship.json [--num-cpus N]
    ray job submit -- python -m logpipe_ray --config spec.json
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="logpipe_ray")
    ap.add_argument("--config", "-f", required=True, help="pipeline spec JSON")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument(
        "--show", type=int, default=20, help="rows of the result to print"
    )
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from logpipe_ray.config import build_pipeline

    result = build_pipeline(args.config)
    if result is None:
        print(json.dumps({"status": "ok", "result": None}))
    elif isinstance(result, ray.data.Dataset):
        df = result.limit(args.show).to_pandas()
        print(df.to_string())
        print(json.dumps({"status": "ok", "rows_shown": len(df)}))
    else:
        print(result)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
