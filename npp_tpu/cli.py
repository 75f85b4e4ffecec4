"""Command-line entry points (replaces the reference's four train.py scripts
and run_*.sh loops; reference: run_completion.sh:1-14 etc.).

Usage:
  python -m npp_tpu.cli search   --datadir D --outdir O [overrides]
  python -m npp_tpu.cli complete --datadir D --basedir B [overrides]
  python -m npp_tpu.cli segment  --datadir D --basedir B [overrides]
  python -m npp_tpu.cli remap    --datadir D --basedir B [overrides]

Any dataclass field of the task's config can be overridden with
--<field> <value>; booleans accept true/false.
"""
from __future__ import annotations

import dataclasses
import sys
from typing import Type

from .config import (CompletionConfig, RemappingConfig, SearchConfig,
                     SegmentationConfig)


def _parse_value(field: dataclasses.Field, raw: str):
    t = str(field.type)
    if 'bool' in t:
        return raw.lower() in ('1', 'true', 'yes', 'on')
    if 'Tuple' in t or 'tuple' in t:  # before int/float: 'Tuple[int,...]'
        return tuple(float(v) if '.' in v else int(v)
                     for v in raw.strip('()').split(','))
    if 'int' in t:
        return int(raw)
    if 'float' in t:
        return float(raw)
    return raw


def build_config(cls: Type, argv):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    overrides = {}
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith('--'):
            raise SystemExit(f'unexpected argument: {arg}')
        key = arg[2:]
        if key not in fields:
            raise SystemExit(f'unknown option --{key} for {cls.__name__}')
        if i + 1 >= len(argv):
            raise SystemExit(f'--{key} requires a value')
        overrides[key] = _parse_value(fields[key], argv[i + 1])
        i += 2
    return cls(**overrides)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ('-h', '--help'):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]

    from . import enable_compilation_cache
    enable_compilation_cache()

    if cmd == 'search':
        from .proposal.search import run_search
        run_search(build_config(SearchConfig, rest))
    elif cmd == 'complete':
        from .models.completion import run_completion
        run_completion(build_config(CompletionConfig, rest))
    elif cmd == 'segment':
        from .models.segmentation import run_segmentation
        run_segmentation(build_config(SegmentationConfig, rest))
    elif cmd == 'remap':
        from .models.remapping import run_remapping
        run_remapping(build_config(RemappingConfig, rest))
    else:
        raise SystemExit(f'unknown command: {cmd}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
