from fluidsolver_tpu.driver import main

main()
