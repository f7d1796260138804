#!/usr/bin/env python
"""full_eval entry point — see gsjax/cli/full_eval.py (reference: full_eval.py)."""

from gsjax.cli.full_eval import main

if __name__ == "__main__":
    main()
