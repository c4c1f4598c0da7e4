"""CLI entry: python -m tps_tpu --runFile <ini> (the `tps` binary analog,
reference: src/main.cpp:39-67)."""

from .harness import main

raise SystemExit(main())
