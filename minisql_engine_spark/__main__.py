from minisql_engine_spark.cli import main

raise SystemExit(main())
