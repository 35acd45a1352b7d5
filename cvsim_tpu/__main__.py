from cvsim_tpu.cli.main import main, exit_main

exit_main(main())
