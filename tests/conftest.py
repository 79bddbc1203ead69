import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DATA = "/root/reference/src/DataDock.CsvWeb.Tests/data"


def reference_fixture(name: str) -> str:
    """Read a golden fixture from the read-only reference checkout."""
    path = os.path.join(REFERENCE_DATA, name)
    with open(path, encoding="utf-8-sig") as f:
        return f.read()


def have_reference() -> bool:
    return os.path.isdir(REFERENCE_DATA)
