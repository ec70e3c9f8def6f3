#!/bin/bash
# Relay watcher: probe the axon relay on a period; when it answers, run the
# honest-measurement campaign (tools/campaign.py resumes by section).  Exit
# once every section is marked DONE in tools/campaign_results.txt.
cd /root/repo

ALL_SECTIONS="fg convspeed fg11 gemm int8 algochoice vgg16-many resnet50-many vgg16-profile resnet50-profile attn verify bench"

all_done() {
    [ -f tools/campaign_results.txt ] || return 1
    for s in $ALL_SECTIONS; do
        if ! grep -q "=== DONE $s" tools/campaign_results.txt; then
            # settle for a section that failed twice (not relay flakiness)
            nfail=$(grep -c "=== FAILED $s" tools/campaign_results.txt)
            [ "$nfail" -ge 2 ] || return 1
        fi
    done
    return 0
}

while true; do
    if all_done; then
        echo "watcher: campaign complete @ $(date +%H:%M:%S)"
        break
    fi
    if timeout 180 python -c "
import numpy as np, jax.numpy as jnp
a = jnp.ones((512,512), jnp.bfloat16)
np.asarray((a@a).ravel()[:1])
print('alive')
" >/dev/null 2>&1; then
        echo "watcher: relay alive @ $(date +%H:%M:%S), launching campaign"
        timeout 10800 python tools/campaign.py >> /tmp/campaign.log 2>&1
        echo "watcher: campaign window ended @ $(date +%H:%M:%S) (exit $?)"
    else
        echo "watcher: relay wedged @ $(date +%H:%M:%S), sleeping 15 min"
    fi
    sleep 900
done
