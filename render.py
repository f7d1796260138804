#!/usr/bin/env python
"""render entry point — see gsjax/cli/render.py (reference: render.py)."""

from gsjax.cli.render import main

if __name__ == "__main__":
    main()
