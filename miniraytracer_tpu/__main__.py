from miniraytracer_tpu.cli import main

raise SystemExit(main())
