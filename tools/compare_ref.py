"""Reference-vs-ours validation sweep (VERDICT #4).

Generates the BASELINE corpora (synthetic; zero-egress container), runs the
reference binary (CPU) and/or our CLI (TPU) on each config, and prints a
size table. Run modes:
    python tools/compare_ref.py ref     # reference side only (CPU, parallel-safe)
    python tools/compare_ref.py ours    # our side only (needs the TPU free)
    python tools/compare_ref.py         # both
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/tmp/refbuild/fqs-1.1"
OUT = "/tmp/fqtz_cmp"
STATE = os.path.join(OUT, "results.json")

CONFIGS = [
    # name, kind, gen args, mode args (shared flag surface)
    ("se_orig", "se", dict(n=100_000, L=100, g=4_600_000, real=False),
     ["-om", "o", "-qm", "8", "-im", "n", "-gs", "5"]),
    ("se_sorted", "se", dict(n=100_000, L=100, g=4_600_000, real=False),
     ["-om", "s", "-qm", "8", "-im", "n", "-gs", "5"]),
    ("se_real", "se", dict(n=100_000, L=100, g=4_600_000, real=True),
     ["-om", "o", "-qm", "8", "-im", "n", "-gs", "5"]),
    ("se_qlossless", "se", dict(n=100_000, L=100, g=4_600_000, real=False),
     ["-om", "o", "-qm", "o", "-im", "n", "-gs", "5"]),
    ("se_ids", "se", dict(n=100_000, L=100, g=4_600_000, real=False),
     ["-om", "o", "-qm", "n", "-im", "o", "-gs", "5"]),
    ("pe_orig", "pe", dict(n=50_000, L=100, g=4_600_000),
     ["-om", "o", "-qm", "n", "-im", "n", "-gs", "5"]),
]


def gen(name, kind, a):
    from fqsqueezer_tpu.utils.corpus import (
        write_fastq_corpus, write_fastq_corpus_realistic, write_pe_corpus)

    os.makedirs(OUT, exist_ok=True)
    if kind == "se":
        path = os.path.join(OUT, f"{name}.fastq")
        if not os.path.exists(path):
            if a.get("real"):
                write_fastq_corpus_realistic(path, a["n"], a["L"], a["g"],
                                             seed=42)
            else:
                write_fastq_corpus(path, a["n"], a["L"], a["g"], seed=42)
        return [path]
    p1 = os.path.join(OUT, f"{name}_1.fastq")
    p2 = os.path.join(OUT, f"{name}_2.fastq")
    if not os.path.exists(p1):
        write_pe_corpus(p1, p2, a["n"], a["L"], a["g"], seed=42)
    return [p1, p2]


def load_state():
    return json.load(open(STATE)) if os.path.exists(STATE) else {}


def save_state(st):
    json.dump(st, open(STATE, "w"), indent=1)


def run_ref(name, kind, files, margs):
    arc = os.path.join(OUT, f"{name}.ref.fqs")
    cmd = [REF, "e", "-p" if kind == "pe" else "-s", "-t", "1",
           *margs, "-out", arc, *files]
    t0 = time.time()
    subprocess.run(cmd, check=True, capture_output=True)
    return {"bytes": os.path.getsize(arc), "wall": round(time.time() - t0, 1)}


def run_ours(name, kind, files, margs):
    arc = os.path.join(OUT, f"{name}.ours.fqst")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.environ.get("FQTZ_CPU"):
        # TPU tunnel busy/down: archive bytes are backend-deterministic
        # (integer-only codec), so sizes measured on CPU are valid; walls
        # are marked cpu=True and must not be compared against the chip.
        head = [sys.executable, os.path.join(repo, "tools", "cpu_cli.py")]
    else:
        head = [sys.executable, "-m", "fqsqueezer_tpu.cli"]
    cmd = [*head, "e",
           "-p" if kind == "pe" else "-s", *margs, "-out", arc, *files]
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True,
                       cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-4000:] + "\n")
        raise SystemExit(f"[{name}] ours failed rc={r.returncode}")
    out = {"bytes": os.path.getsize(arc), "wall": round(time.time() - t0, 1)}
    if os.environ.get("FQTZ_CPU"):
        out["cpu"] = True
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    only = sys.argv[2:] or None
    st = load_state()
    for name, kind, a, margs in CONFIGS:
        if only and name not in only:
            continue
        files = gen(name, kind, a)
        ent = st.setdefault(name, {})
        if which in ("ref", "both") and "ref" not in ent:
            ent["ref"] = run_ref(name, kind, files, margs)
            print(f"[{name}] ref: {ent['ref']}", flush=True)
            save_state(st)
        if which in ("ours", "both") and "ours" not in ent:
            ent["ours"] = run_ours(name, kind, files, margs)
            print(f"[{name}] ours: {ent['ours']}", flush=True)
            save_state(st)
    # table
    print(f"\n{'config':14} {'ref B':>12} {'ours B':>12} {'ours/ref':>9}")
    for name, ent in st.items():
        r = ent.get("ref", {}).get("bytes")
        o = ent.get("ours", {}).get("bytes")
        ratio = f"{o / r:.4f}" if r and o else "-"
        print(f"{name:14} {r or '-':>12} {o or '-':>12} {ratio:>9}")


if __name__ == "__main__":
    main()
