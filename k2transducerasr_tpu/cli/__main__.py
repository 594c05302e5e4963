from k2transducerasr_tpu.cli.main import main

raise SystemExit(main())
