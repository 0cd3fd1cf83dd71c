"""Regenerate docs/example_montage.jpg via the `montage` CLI command
(single source of truth for the panel layout lives in foveax.cli.main).

Run: PYTHONPATH=. python scripts/make_examples.py
"""

import pathlib

from foveax.cli.main import main

if __name__ == "__main__":
    pathlib.Path("docs").mkdir(exist_ok=True)
    raise SystemExit(
        main(
            [
                "montage",
                "synthetic://1920x1080@30/40",
                "30",
                "docs/example_montage.jpg",
                "--gaze",
                "0.62,0.45",
            ]
        )
    )
