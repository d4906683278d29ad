/**
 * Image component. Either references a globally registered image
 * (imageId) or registers its own output-scoped image from `source`
 * (URL or server path) and renders an empty View until ready.
 */
import { createElement, useContext, useEffect, useState } from 'react';
import type * as Api from '../api.js';
import type { ComponentBaseProps, SceneComponent } from '../component.js';
import { createSmelterComponent } from '../component.js';
import { newInternalImageId } from '../context/internalImageIdManager.js';
import { SmelterContext } from '../context/index.js';
import { newBlockingTask } from '../hooks.js';
import type { RegisterImage } from '../types/resource.js';
import {
  imageRefIntoRawId,
  OUTPUT_SPECIFIC_IMAGE_TYPE,
} from '../types/refs/imageRef.js';
import View from './View.js';

export type ImageStyleProps = {
  width?: number;
  height?: number;
};

export type ImageProps = Omit<ComponentBaseProps, 'children'> &
  (
    | { imageId: Api.RendererId; source?: never }
    | { source: string; imageId?: never }
  ) & {
    style?: ImageStyleProps;
  };

type InnerImageProps = Omit<ImageProps, 'imageId' | 'source'> & { imageId: string };

function sceneBuilder(props: InnerImageProps, _children: SceneComponent[]): Api.Component {
  return {
    type: 'image',
    id: props.id,
    image_id: props.imageId,
    width: props.style?.width,
    height: props.style?.height,
  };
}

export const InnerImage = createSmelterComponent<InnerImageProps>(sceneBuilder);

function Image(props: ImageProps) {
  const ctx = useContext(SmelterContext);
  const [internalImageId, setInternalImageId] = useState(0);
  const [registered, setRegistered] = useState(!!props.imageId);

  if ((props.imageId && props.source) || (!props.imageId && !props.source)) {
    throw new Error('Either "imageId" or "source" must be provided, but not both.');
  }

  useEffect(() => {
    if (props.imageId) {
      setRegistered(true);
      return;
    }
    setRegistered(false);
    const newImageId = newInternalImageId();
    setInternalImageId(newImageId);
    const sourceField: Pick<RegisterImage, 'serverPath' | 'url'> =
      props.source?.startsWith('http://') || props.source?.startsWith('https://')
        ? { url: props.source }
        : { serverPath: props.source };

    let registerPromise: Promise<unknown> | undefined;
    const task = newBlockingTask(ctx);
    void (async () => {
      try {
        registerPromise = ctx.registerImage(newImageId, {
          ...sourceField,
          assetType: 'auto',
        });
        await registerPromise;
        setRegistered(true);
      } finally {
        task.done();
      }
    })();
    return () => {
      task.done();
      void (async () => {
        await registerPromise?.catch(() => undefined);
        await ctx.unregisterImage(newImageId);
      })();
    };
  }, [props.source, props.imageId]);

  if (!registered) {
    return createElement(View, {});
  }
  if (props.source) {
    return createElement(InnerImage, {
      ...props,
      imageId: imageRefIntoRawId({
        type: OUTPUT_SPECIFIC_IMAGE_TYPE,
        id: internalImageId,
        outputId: ctx.outputId,
      }),
    });
  }
  return createElement(InnerImage, {
    ...props,
    imageId: imageRefIntoRawId({ type: 'global', id: props.imageId as string }),
  });
}

export default Image;
