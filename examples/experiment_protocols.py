"""Run the reference's per-object experiment protocols headlessly.

Thin wrapper over ``python -m pdc_tpu experiment`` (pdc_tpu.experiments):
the 11 notebook directories under the reference's
``dense_correspondence/experiments/`` are registered as declarative,
scriptable protocols — variant grid, config mutations, composite datasets,
and evaluation sweep all captured as data.

    python examples/experiment_protocols.py --list
    python examples/experiment_protocols.py domain_randomization --steps 600
    python examples/experiment_protocols.py multi_object --max_runs 8 \
        --steps 600 --width 96 --height 72

Committed results for the ablation protocols live under
``trained_models/experiments/`` (result.json + comparison CDF overlays).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pdc_tpu.__main__ import _cmd_experiment

    return _cmd_experiment(sys.argv[1:])


if __name__ == "__main__":
    sys.exit(main())
