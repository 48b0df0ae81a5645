"""Sample a spinning process's RIP via ptrace (no gdb in this image).

Usage: python tools/rip_sample.py <pid> [n_samples]

Attaches with PTRACE_ATTACH, reads RIP via PTRACE_GETREGS a few times
(detaching between samples so the target keeps running), subtracts the
executable's load base (from /proc/<pid>/maps), and prints file:line via
addr2line -f -e <exe>. x86_64 only.
"""
import ctypes
import subprocess
import sys
import time

PTRACE_ATTACH, PTRACE_DETACH, PTRACE_GETREGS = 16, 17, 12
libc = ctypes.CDLL("libc.so.6", use_errno=True)


class Regs(ctypes.Structure):
    # user_regs_struct, x86_64 (sys/user.h)
    _fields_ = [(n, ctypes.c_ulonglong) for n in (
        "r15", "r14", "r13", "r12", "rbp", "rbx", "r11", "r10", "r9", "r8",
        "rax", "rcx", "rdx", "rsi", "rdi", "orig_rax", "rip", "cs",
        "eflags", "rsp", "ss", "fs_base", "gs_base", "ds", "es", "fs", "gs")]


def sample_rip(tid):
    if libc.ptrace(PTRACE_ATTACH, tid, 0, 0) != 0:
        raise OSError(ctypes.get_errno(), f"attach {tid}")
    import os
    os.waitpid(tid, 0)
    regs = Regs()
    libc.ptrace(PTRACE_GETREGS, tid, 0, ctypes.byref(regs))
    rip = regs.rip
    libc.ptrace(PTRACE_DETACH, tid, 0, 0)
    return rip


def main():
    pid = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    exe = f"/proc/{pid}/exe"
    import os
    exe_path = os.readlink(exe)
    base = None
    for line in open(f"/proc/{pid}/maps"):
        if exe_path in line and "r-x" in line:
            base = int(line.split("-")[0], 16)
            break
    # PIE binaries need the base subtracted; non-PIE maps start at the
    # link-time address so base-relative also works if ET_EXEC detected
    et = subprocess.run(["readelf", "-h", exe],
                        capture_output=True, text=True).stdout
    pie = "DYN" in et
    offs = []
    for _ in range(n):
        rip = sample_rip(pid)
        offs.append(rip - base if pie else rip)
        time.sleep(0.08)
    out = subprocess.run(
        ["addr2line", "-f", "-C", "-e", exe] + [hex(o) for o in offs],
        capture_output=True, text=True).stdout
    print(out)


if __name__ == "__main__":
    main()
