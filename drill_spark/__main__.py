"""``python -m drill_spark`` — the drill-embedded shell entry point."""

from drill_spark.cli import main

raise SystemExit(main())
