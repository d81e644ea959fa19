"""Pin the reference checkout before executing its code in-process.

The differential-parity tests import and RUN files from
/root/reference (designated public untrusted content). To keep an
altered checkout from executing unnoticed under the test runner
(round-2 ADVICE), the entry files each test imports are pinned by
sha256 prefix here; a mismatch SKIPS the differential tests with an
explicit reason instead of running unknown code. Re-pin consciously
(update the digests) after reviewing any reference change.
"""

from __future__ import annotations

import hashlib
import os

REF = "/root/reference"

# sha256[:16] of every reference file the parity tests import/exec
PINNED: dict[str, str] = {
    "multiomics_kg/utils/gene_id_utils.py": "8f1db9f26697c1b5",
    "multiomics_kg/adapters/observations_adapter.py": "49781fcbe786d257",
    "multiomics_kg/adapters/metabolite_assay_adapter.py": "4e5e8cb4131ae687",
    "multiomics_kg/adapters/omics_adapter.py": "bbe378c60a47113c",
}


def reference_status() -> str | None:
    """None if the checkout is present and pinned; else a skip reason."""
    if not os.path.isdir(REF):
        return "reference checkout not available"
    for rel, want in PINNED.items():
        path = os.path.join(REF, rel)
        try:
            with open(path, "rb") as f:
                got = hashlib.sha256(f.read()).hexdigest()[:16]
        except OSError:
            return f"pinned reference file missing: {rel}"
        if got != want:
            return (
                f"reference file changed ({rel}: {got} != pinned {want}) — "
                "refusing to execute unpinned code; review and re-pin"
            )
    return None
