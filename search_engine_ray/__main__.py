from search_engine_ray.cli import main

raise SystemExit(main())
