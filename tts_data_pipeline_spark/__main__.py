"""``python -m tts_data_pipeline_spark`` — see :mod:`.cli`."""

from tts_data_pipeline_spark.cli import main

raise SystemExit(main())
