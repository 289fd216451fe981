from ella_spark.cli import main

raise SystemExit(main())
