import sys; sys.path.insert(0, "/root/repo")
sys.argv = ["check_oracles.py"] + sys.argv[1:]
