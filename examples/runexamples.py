"""Run every example headless (the reference's examples/runexamples.py:
examples double as integration tests)."""

import pathlib
import runpy
import sys
import time


def main():
    here = pathlib.Path(__file__).parent
    scripts = sorted(
        p for p in here.glob('*.py') if p.name != 'runexamples.py'
    )
    failures = []
    for script in scripts:
        print(f'=== {script.name} ===', flush=True)
        t0 = time.perf_counter()
        try:
            runpy.run_path(str(script), run_name='__main__')
        except Exception as exc:  # noqa: BLE001 - report and continue
            failures.append((script.name, exc))
            print(f'FAILED: {exc!r}')
        else:
            print(f'ok ({time.perf_counter() - t0:.1f}s)')
    if failures:
        print(f'\n{len(failures)} example(s) failed:')
        for name, exc in failures:
            print(f'  {name}: {exc!r}')
        sys.exit(1)
    print(f'\nall {len(scripts)} examples passed')


if __name__ == '__main__':
    main()
