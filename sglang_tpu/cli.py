"""Command-line interface.

Parity with reference `python/sglang/cli/main.py:12` (`sglang serve`,
`sglang generate`, `sglang version`) plus `bench` subcommands.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="sglang_tpu", description="TPU-native LLM serving engine"
    )
    sub = parser.add_subparsers(dest="command")

    from sglang_tpu.server_args import ServerArgs

    p_serve = sub.add_parser("serve", help="launch the HTTP server")
    ServerArgs.add_cli_args(p_serve)

    p_gen = sub.add_parser("generate", help="one-shot offline generation")
    ServerArgs.add_cli_args(p_gen)
    p_gen.add_argument("--prompt", required=True)
    p_gen.add_argument("--max-new-tokens", type=int, default=128)
    p_gen.add_argument("--temperature", type=float, default=0.0)

    sub.add_parser("version", help="print the version")

    p_bench = sub.add_parser("bench-serving", help="online serving benchmark")
    p_bench.add_argument("--base-url", default="http://127.0.0.1:30000")
    p_bench.add_argument("--num-prompts", type=int, default=100)
    p_bench.add_argument("--request-rate", type=float, default=float("inf"))
    p_bench.add_argument("--random-input", type=int, default=512)
    p_bench.add_argument("--random-output", type=int, default=256)
    p_bench.add_argument("--range-ratio", type=float, default=0.3)
    p_bench.add_argument("--vocab-size", type=int, default=32000)
    p_bench.add_argument("--seed", type=int, default=0)
    p_bench.add_argument("--timeout", type=float, default=1800)

    args = parser.parse_args(argv)
    if args.command == "version":
        from sglang_tpu.version import __version__

        print(__version__)
        return 0
    if args.command == "serve":
        from sglang_tpu.entrypoints.http_server import launch_server

        launch_server(ServerArgs.from_cli_args(args))
        return 0
    if args.command == "generate":
        from sglang_tpu.entrypoints.engine import Engine

        engine = Engine(ServerArgs.from_cli_args(args))
        out = engine.generate(
            args.prompt,
            sampling_params={
                "max_new_tokens": args.max_new_tokens,
                "temperature": args.temperature,
            },
        )
        print(json.dumps(out, indent=2))
        return 0
    if args.command == "bench-serving":
        import asyncio

        from sglang_tpu.bench_serving import run_benchmark

        print(json.dumps(asyncio.run(run_benchmark(args)), indent=2))
        return 0
    parser.print_help()
    return 1


if __name__ == "__main__":
    sys.exit(main())
