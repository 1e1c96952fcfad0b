"""Compare the installed nellie_tpu version against the latest on PyPI.

Reference: ``/root/reference/verify_version.py``.  Zero-egress or
offline environments simply report the local version.
"""
import json
import urllib.request

import nellie_tpu


def get_latest_pypi_version(package: str = "nellie-tpu", timeout: float = 5.0):
    url = f"https://pypi.org/pypi/{package}/json"
    try:
        with urllib.request.urlopen(url, timeout=timeout) as response:
            data = json.load(response)
        return data["info"]["version"]
    except Exception:
        return None


def main():
    local = nellie_tpu.__version__
    latest = get_latest_pypi_version()
    if latest is None:
        print(f"nellie_tpu {local} (PyPI unreachable — offline?)")
    elif latest == local:
        print(f"nellie_tpu {local} (up to date)")
    else:
        print(f"nellie_tpu {local} (PyPI has {latest})")


if __name__ == "__main__":
    main()
