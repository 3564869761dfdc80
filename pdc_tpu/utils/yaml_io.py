"""YAML IO helpers (host-side, non-critical path).

Replaces the reference's ``utils.py:23-44`` (CLoader-based YAML load/save).
Uses the C loader when available for speed, falling back to the pure-python
one.
"""

import os

import yaml

try:
    _Loader = yaml.CSafeLoader
    _Dumper = yaml.CSafeDumper
except AttributeError:  # pragma: no cover - libyaml not present
    _Loader = yaml.SafeLoader
    _Dumper = yaml.SafeDumper


def load_yaml(filename):
    """Load a YAML file into a dict."""
    with open(filename, "r") as f:
        return yaml.load(f, Loader=_Loader)


def save_yaml(data, filename):
    """Save a dict to a YAML file, creating parent directories as needed."""
    parent = os.path.dirname(os.path.abspath(filename))
    os.makedirs(parent, exist_ok=True)
    with open(filename, "w") as f:
        yaml.dump(data, f, Dumper=_Dumper, default_flow_style=False)


def load_yaml_string(s):
    return yaml.load(s, Loader=_Loader)
