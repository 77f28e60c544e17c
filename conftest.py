"""Repo-root conftest: make the package importable when pytest runs here."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
