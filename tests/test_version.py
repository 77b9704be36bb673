"""Package version must match the build metadata."""

import re
from os.path import dirname, join, realpath

from springcraft_tpu import __version__


def test_version():
    pyproject = join(dirname(dirname(realpath(__file__))), "pyproject.toml")
    with open(pyproject) as f:
        content = f.read()
    match = re.search(r'^version\s*=\s*"([^"]+)"', content, re.MULTILINE)
    assert match is not None, "No version in pyproject.toml"
    assert __version__ == match.group(1)
