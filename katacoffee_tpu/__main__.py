from katacoffee_tpu.cli import main

raise SystemExit(main())
