"""``python -m dpdfnet_tpu`` — runs the CLI (reference analogue:
`/root/reference/package/src/dpdfnet/__main__.py:1-5`)."""

from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
