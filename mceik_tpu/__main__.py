from mceik_tpu.cli import main

raise SystemExit(main())
