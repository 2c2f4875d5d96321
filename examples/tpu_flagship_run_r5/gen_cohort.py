"""Generate the synthetic cohort for the round-5 flagship CLI run.

48 patients with T1/T2 NIfTI trees + clinical CSV carrying a planted
survival signal (tests/fixtures.make_clinical_csv signal=True: hazard
depends on TumorGrade/TumorVolume/Age), so the archived training curves
reflect a learnable problem, not noise.

  python examples/tpu_flagship_run_r5/gen_cohort.py [/tmp/drive_r5]
"""

import os
import sys

_repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, _repo)
sys.path.insert(0, os.path.join(_repo, "tests"))

from fixtures import (  # noqa: E402
    make_clinical_csv, make_image_tree, make_patient_key,
)


def main(root="/tmp/drive_r5", n=48, seed=5):
    os.makedirs(root, exist_ok=True)
    uids = make_clinical_csv(os.path.join(root, "clinical.csv"), n, seed,
                             signal=True)
    anon = make_patient_key(os.path.join(root, "key.csv"), uids)
    make_image_tree(os.path.join(root, "t1"), anon, shape=(48, 52, 44),
                    seed=seed + 1)
    make_image_tree(os.path.join(root, "t2"), anon, shape=(48, 52, 44),
                    seed=seed + 2)
    print(f"cohort at {root}: {n} patients")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/drive_r5"]))
