"""`python -m sglang_tpu.launch_server --model-path ...`

Parity with reference `python/sglang/launch_server.py`.
"""

from sglang_tpu.entrypoints.http_server import main

if __name__ == "__main__":
    main()
