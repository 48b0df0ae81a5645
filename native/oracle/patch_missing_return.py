"""Build-time patch: add the missing `return` to structPoseEstimation.

The reference's `bool CoarseTracker::structPoseEstimation(...)`
(CoarseTracker.cpp:949-1007) has no return statement. Flowing off the end
of a non-void function is undefined behavior; GCC 12 at -O2 deletes the
LM loop's exit as "unreachable" and the oracle spins forever on frame 2.
The only call site discards the result (FullSystem.cpp:488), so appending
`return true;` before the function's closing brace is behavior-neutral.

Usage: python3 patch_missing_return.py <in.cpp> <out.cpp>
"""
import sys


def main():
    src, dst = sys.argv[1], sys.argv[2]
    text = open(src).read()
    anchor = "bool CoarseTracker::structPoseEstimation"
    start = text.index(anchor)
    # walk to the function's closing brace by brace depth
    i = text.index("{", start)
    depth = 0
    for j in range(i, len(text)):
        if text[j] == "{":
            depth += 1
        elif text[j] == "}":
            depth -= 1
            if depth == 0:
                break
    else:
        raise SystemExit("structPoseEstimation closing brace not found")
    patched = text[:j] + "\treturn true;  // build fix: missing return " \
        "(UB -> infinite loop at -O2), value unused by the caller\n" + \
        text[j:]
    with open(dst, "w") as f:
        f.write(patched)
    print(f"patched {src} -> {dst}")


if __name__ == "__main__":
    main()
