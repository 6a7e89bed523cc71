#!/usr/bin/env python3
"""Run deepbinner-tpu from a repository clone without installing.

Reference parity: ``deepbinner-runner.py`` (SURVEY.md §2 item 12).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deepbinner_tpu.cli.main import main

if __name__ == "__main__":
    main()
