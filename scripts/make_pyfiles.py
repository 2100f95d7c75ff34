"""Build dist/kgtm.zip for spark-submit --py-files (north_rule packaging)."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "kgtm.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / "kgtm").glob("**/*.py")):
            z.write(p, p.relative_to(REPO))
    print(out)


if __name__ == "__main__":
    main()
