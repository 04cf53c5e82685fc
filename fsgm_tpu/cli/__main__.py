from fsgm_tpu.cli.main import main

raise SystemExit(main())
