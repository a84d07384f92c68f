"""``python -m kupo_spark`` — see :mod:`kupo_spark.cli`."""

from kupo_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
