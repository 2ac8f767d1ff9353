"""Run several hardware probes in ONE process (tunnel init and remote
compiles are per-process; batching amortises them)."""
import sys
import traceback


def main():
    names = sys.argv[1:] or ["profile_eve", "profile_isect"]
    for name in names:
        print(f"=== {name}", flush=True)
        mod = __import__(name)
        try:
            mod.main()
        except Exception:  # noqa: BLE001
            traceback.print_exc()
            print(f"{name} FAILED", flush=True)


if __name__ == "__main__":
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)  # `import mrt` regardless of cwd/PYTHONPATH
    sys.path.insert(0, os.path.join(root, "tools"))
    main()
