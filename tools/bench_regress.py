#!/usr/bin/env python3
"""Per-query bench regression guard (VERDICT r2 #9).

Usage: python3 tools/bench_regress.py <prior_bench.json> <new_bench.json>
       [--factor 2.0] [--min-sec 0.5]

Compares per-query times between two Bench JSON lines and exits non-zero
if any query regressed by more than --factor (default 2x), ignoring
queries faster than --min-sec in both rounds (sub-500ms times are noise
at this harness's resolution). New queries (absent from the prior file)
are reported informationally, never flagged.

Caveat: cross-round comparisons before round 3 measured single shots, not
medians — treat a first run against an r1/r2 file as directional only.
"""
import sys, json, re, glob, hashlib, os

def names_sig(sorted_names):
    """Mirror of Bench.namesSig: md5 of '\n'.join(sorted names), 8 hex."""
    return hashlib.md5("\n".join(sorted_names).encode()).hexdigest()[:8]

def decode_positional(data, other_names=None):
    """Decode the r13 compact twin's positional 'queries' vector (values
    by SORTED query name, validated by the qsig signature) by trying
    the OTHER snapshot's name list first (it is usually the same round
    +- one gate), then the name list of every committed
    CORRECTNESS_r{N}.json — the file that records each round's exact
    query set. Falls back to the snapshot's 'top' named object (the
    slowest few, always name-keyed), never to a blind zip (mislabeling
    every entry is worse than fewer entries)."""
    vec, sig = data.get("queries"), data.get("qsig", "")
    if other_names and len(other_names) == len(vec) \
            and names_sig(other_names) == sig:
        return dict(zip(other_names, vec))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # newest ROUND first by the extracted number (lexicographic name
    # order puts r9 before r13; the sig keeps any order correct, but
    # the newest round is the likely match)
    def round_no(p):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")),
                       key=round_no, reverse=True):
        try:
            names = sorted(json.load(open(path)).keys())
        except Exception:
            continue
        if len(names) == len(vec) and names_sig(names) == sig:
            return dict(zip(names, vec))
    top = dict(data.get("top", {}))
    print(f"WARNING: positional vector ({len(vec)} entries, qsig {sig}) "
          f"UNDECODABLE — no committed CORRECTNESS_r{{N}}.json name list "
          f"matched; comparing only the {len(top)} slowest named entries "
          f"(regressions outside them are UNCHECKED)", file=sys.stderr)
    return top

def load(path):
    with open(path) as f:
        data = json.load(f)
    # the driver's BENCH_r{N}.json wraps the bench line under "parsed";
    # when its stdout scrape fails, "parsed" is null and "tail" holds a
    # (possibly truncated) fragment of the JSON line — recover the
    # per-query pairs by regex (the first pair may be cut off mid-name)
    if "parsed" in data:
        if isinstance(data["parsed"], dict):
            data = data["parsed"]
        else:
            # mirror Bench.snapshotQueries' tail decode exactly: anchor
            # each pair between JSON delimiters (a tail boundary can cut
            # a number mid-token — an unanchored match decodes a WRONG
            # old time, the ADVICE-r10 spurious-verdict class) and
            # exclude every non-query numeric field the compact twin
            # carries (slim-env keys would otherwise decode as phantom
            # queries and report as BROKEN later)
            pairs = re.findall(r'[,{]"([A-Za-z0-9_]+)":(-?\d+\.\d+)(?=[,}])',
                               data.get("tail", ""))
            skip = {"value", "load_start", "load_end", "baseline_s",
                    "suffix_index_cold_s", "span_frame_cold_s",
                    "steal_cpu_s", "steal_cores_avg", "sf"}
            qs = {k: float(v) for k, v in pairs if k not in skip}
            # the tail window is the scrape's last 2000 chars: pairs
            # outside it are simply gone — disclose the shrunken set
            # (same note the Scala decoder emits; ADVICE r13)
            print(f"WARNING: scrape-failed snapshot {path}: {len(qs)} "
                  f"pairs recovered from a truncated tail fragment; "
                  f"regressions outside them are UNCHECKED",
                  file=sys.stderr)
            data = {"queries": qs}
    return data

def queries_of(data, other):
    """Per-query map of a normalized snapshot; a positional vector may
    decode through the OTHER snapshot's name list (sig-validated)."""
    qs = data.get("queries", {})
    if isinstance(qs, list):  # r13 positional compact twin
        oq = other.get("queries", {}) if other else {}
        other_names = sorted(oq.keys()) if isinstance(oq, dict) and oq else None
        qs = decode_positional(data, other_names)
    return {k: v for k, v in qs.items() if v >= 0}

def main():
    argv = sys.argv[1:]
    factor = 2.0
    min_sec = 0.5
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--factor":
            factor = float(argv[i + 1]); i += 2
        elif a == "--min-sec":
            min_sec = float(argv[i + 1]); i += 2
        else:
            args.append(a); i += 1
    prior_raw, new_raw = load(args[0]), load(args[1])
    prior, new = queries_of(prior_raw, new_raw), queries_of(new_raw, prior_raw)
    flagged, improved, added, broken = [], [], [], []
    # a query that PASSED before but now fails (-1, filtered by load) or
    # vanished entirely is the worst regression — never drop it silently
    for q in sorted(prior):
        if q not in new:
            broken.append(q)
    for q, t in sorted(new.items()):
        if q not in prior:
            added.append(q)
            continue
        p = prior[q]
        if t > p * factor and max(t, p) >= min_sec:
            flagged.append((q, p, t))
        elif p > t * factor and max(t, p) >= min_sec:
            improved.append((q, p, t))
    for q in broken:
        print(f"BROKEN    {q}: passed in prior round, failed or missing now")
    for q, p, t in flagged:
        print(f"REGRESSED {q}: {p:.2f}s -> {t:.2f}s ({t / p:.1f}x)")
    for q, p, t in improved:
        print(f"improved  {q}: {p:.2f}s -> {t:.2f}s")
    if added:
        print(f"new queries ({len(added)}): {', '.join(added)}")
    # SHARED totals on both sides: prior's sum previously included
    # queries broken/missing in the new round, reporting their loss as
    # a phantom improvement on a line labeled "shared-query"
    tp = sum(v for k, v in prior.items() if k in new)
    tn = sum(v for k, v in new.items() if k in prior)
    print(f"== shared-query total {tp:.1f}s -> {tn:.1f}s; "
          f"{len(broken)} broken, {len(flagged)} regressed (> {factor}x), "
          f"{len(improved)} improved ==")
    sys.exit(1 if (flagged or broken) else 0)

if __name__ == "__main__":
    main()
